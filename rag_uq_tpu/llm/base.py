"""Generator protocol."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Protocol, Sequence, runtime_checkable


@dataclass
class GenerationResult:
    text: str


@runtime_checkable
class Generator(Protocol):
    """Text generator interface.

    `generate` mirrors the knobs the reference passes to Ollama
    (temperature, top_p, num_predict; confidence.py:150-158).
    `generate_batch` is the TPU-native extension: one call produces K
    samples with per-sample (temperature, top_p), enabling vmapped MC
    sampling instead of K serial calls (confidence.py:225-231).
    """

    def generate(
        self,
        prompt: str,
        temperature: float = 0.1,
        top_p: float = 0.9,
        max_tokens: int = 100,
        seed: Optional[int] = None,
    ) -> str:
        ...

    def generate_batch(
        self,
        prompts: Sequence[str],
        temperatures: Sequence[float],
        top_ps: Sequence[float],
        max_tokens: int = 100,
        seed: Optional[int] = None,
    ) -> List[str]:
        ...
