"""Tokenizer contract tests.

Base behavior is the reference's lowercase + whitespace split
(streaming_index.py:118-120); the ASCII edge-punctuation strip is this
framework's documented deviation (text/tokenize.py docstring), added after
the hand-written out-of-family eval measured recall@10 = 0.0 on
inverse-direction questions whose gold mention is sentence-final
("...remains Guschisshous.").
"""

from rag_uq_tpu.text.tokenize import TOKENIZER_VERSION, tokenize


class TestTokenize:
    def test_lowercase_whitespace_base(self):
        assert tokenize("The Quick\tBrown\nFox") == [
            "the", "quick", "brown", "fox"
        ]

    def test_sentence_final_punct_stripped(self):
        assert tokenize("remains Guschisshous.") == ["remains", "guschisshous"]
        assert tokenize("the river Douthtouth?") == [
            "the", "river", "douthtouth"
        ]

    def test_edge_but_not_interior(self):
        assert tokenize("it's (really!) multi-word 'quoted'") == [
            "it's", "really", "multi-word", "quoted"
        ]

    def test_all_punct_tokens_dropped(self):
        assert tokenize("a -- b ... ?! c") == ["a", "b", "c"]

    def test_digits_kept(self):
        assert tokenize("1643, then: 2863000.") == ["1643", "then", "2863000"]

    def test_unicode_interior_and_edges(self):
        # Non-ASCII chars are never stripped (only ASCII punctuation is).
        assert tokenize("élève? naïve.") == ["élève", "naïve"]

    def test_empty_and_whitespace_only(self):
        assert tokenize("") == []
        assert tokenize("  \t\n ") == []
        assert tokenize("... !!!") == []

    def test_version_stamp_exists(self):
        assert TOKENIZER_VERSION.startswith("v2")
