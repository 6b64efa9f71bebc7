"""Native host runtime bindings (C++ tokenizer / vocabulary / postings).

Builds `librag_native.so` from rag_native.cpp on first use (g++, cached by
source mtime) and exposes it through ctypes. Falls back cleanly when no
compiler is available — callers must check `is_available()`.
"""

from rag_uq_tpu.native.binding import NativeTokenizer, is_available

__all__ = ["NativeTokenizer", "is_available"]
