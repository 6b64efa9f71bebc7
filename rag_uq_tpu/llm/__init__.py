"""Pluggable generation seam.

The reference delegates all generation to an external Ollama service over
HTTP (confidence.py:150-158, run_evaluation.py:84-88). Here generation is a
clean in-framework interface with three providers:

- MockLLM: deterministic cycling test double (the analogue of the
  reference's MockLLMClient, tests/test_confidence.py:24-34).
- TinyLM: a real flax decoder-only transformer with a jit-compiled,
  KV-cached sampling loop (temperature + top-p) that vmaps across MC
  samples — the TPU-native generation path (random-init weights by
  default; loadable).
- Any object with the same `generate` signature (e.g. an external client
  adapter), matching the reference's client-injection pattern.
"""

from rag_uq_tpu.llm.base import GenerationResult, Generator
from rag_uq_tpu.llm.mock import MockLLM
from rag_uq_tpu.llm.tiny_lm import TinyLM, TinyLMConfig

__all__ = ["Generator", "GenerationResult", "MockLLM", "TinyLM", "TinyLMConfig"]
