"""Wikipedia downloader logic via an injected fake transport."""

import json

import pytest

from rag_uq_tpu.data.wikipedia import API_BASE, WikipediaDownloader


class FakeWiki:
    """Deterministic fake MediaWiki API."""

    def __init__(self, n_titles: int = 200, fail_titles=()):
        self.n = n_titles
        self.fail = set(fail_titles)
        self.counter = 0
        self.calls = 0

    def __call__(self, url, params):
        self.calls += 1
        assert url == API_BASE
        if params.get("list") == "random":
            limit = params["rnlimit"]
            titles = [f"Article {self.counter + i}" for i in range(limit)]
            self.counter += limit
            return {"query": {"random": [{"title": t} for t in titles]}}
        title = params["titles"]
        if title in self.fail:
            return {"query": {"pages": {"-1": {}}}}
        return {
            "query": {
                "pages": {
                    "123": {
                        "title": title,
                        "extract": f"Extract text for {title}. " * 5,
                        "fullurl": f"https://en.wikipedia.org/wiki/{title}",
                    }
                }
            }
        }


class TestWikipediaDownloader:
    def test_download_writes_jsonl(self, tmp_path):
        dl = WikipediaDownloader(
            output_dir=str(tmp_path), rate_limit_delay=0.0,
            checkpoint_interval=5, fetch_json=FakeWiki(),
        )
        n = dl.download_corpus(n_articles=12, output_file="wiki.jsonl")
        assert n == 12
        rows = [json.loads(l) for l in open(tmp_path / "wiki.jsonl")]
        assert len(rows) == 12
        assert all({"page_id", "title", "extract", "url"} <= set(r) for r in rows)
        assert (tmp_path / ".wiki.jsonl.checkpoint").exists()

    def test_resume_skips_downloaded(self, tmp_path):
        fake = FakeWiki()
        dl = WikipediaDownloader(
            output_dir=str(tmp_path), rate_limit_delay=0.0, fetch_json=fake,
        )
        dl.download_corpus(n_articles=5, output_file="wiki.jsonl")
        # Fresh downloader, same checkpoint dir: resumes, appends new titles.
        fake2 = FakeWiki()
        dl2 = WikipediaDownloader(
            output_dir=str(tmp_path), rate_limit_delay=0.0, fetch_json=fake2,
        )
        total = dl2.download_corpus(n_articles=5, output_file="wiki.jsonl")
        assert total == 10
        rows = [json.loads(l) for l in open(tmp_path / "wiki.jsonl")]
        assert len(rows) == 10
        assert len({r["title"] for r in rows}) == 10  # no duplicates

    def test_missing_pages_skipped(self, tmp_path):
        fake = FakeWiki(fail_titles={"Article 1"})
        dl = WikipediaDownloader(
            output_dir=str(tmp_path), rate_limit_delay=0.0, fetch_json=fake,
        )
        n = dl.download_corpus(n_articles=3, output_file="w.jsonl")
        assert n == 2  # failed article not counted or written

    def test_transport_failure_terminates(self, tmp_path):
        dl = WikipediaDownloader(
            output_dir=str(tmp_path), rate_limit_delay=0.0,
            fetch_json=lambda url, params: {},
        )
        assert dl.get_random_articles(10) == []
