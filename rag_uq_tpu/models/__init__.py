"""Model zoo: the framework's flax modules in one namespace.

- RouterModule: the retrieval-gating MLP (rag_uq_tpu.router.model)
- EncoderModel: the transformer text encoder (rag_uq_tpu.embed.encoder)
- DecoderModel: the byte-level generation decoder (rag_uq_tpu.llm.tiny_lm)

Each ships with its stateful convenience wrapper (RetrievalRouter,
TransformerEmbedder, TinyLM) in its home module.
"""

from rag_uq_tpu.embed.encoder import EncoderConfig, EncoderModel
from rag_uq_tpu.llm.tiny_lm import DecoderModel, TinyLMConfig
from rag_uq_tpu.router.model import RouterModule

__all__ = [
    "RouterModule",
    "EncoderModel",
    "EncoderConfig",
    "DecoderModel",
    "TinyLMConfig",
]
