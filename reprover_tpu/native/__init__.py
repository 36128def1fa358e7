"""Native (C++) components: BPE tokenizer for the BM25 baseline."""

from reprover_tpu.native.bpe import BpeTokenizer, native_available

__all__ = ["BpeTokenizer", "native_available"]
