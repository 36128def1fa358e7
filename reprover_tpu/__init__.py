"""ReProver-TPU: a TPU-native retrieval-augmented theorem-proving framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of lean-dojo/ReProver:

- Premise retrieval: a ByT5 encoder embeds proof states and Mathlib premises
  into unit-norm vectors; retrieval is a fused masked cosine top-k on device.
- Tactic generation: a ByT5 encoder-decoder with fixed-shape batched beam
  search, trained with teacher forcing.
- Proof search: host-side best-first search over Lean proof states, fed by a
  continuously-batched TPU inference service shared across many concurrent
  searches.

Package layout:

- ``data``       corpus DAG / accessibility bitmasks / pickle interop (host)
- ``models``     functional T5 (ByT5) + LLaMA-family causal LM + HF import
- ``ops``        Pallas kernels and fused device ops (attention, top-k, pooling)
- ``parallel``   mesh + sharding specs (DP / TP / ZeRO-style optimizer sharding)
- ``retrieval``  premise retriever, indexer, prediction, R@k/MRR eval, BM25
- ``generation`` tactic generators (seq2seq + causal), beam search, preprocess
- ``prover``     environment protocol, search tree, best-first search, shared
                 TPU inference service (continuous batching), Pass@1 harness
- ``training``   optax train steps, trainer loop, Orbax checkpoints
- ``native``     C++ components (BPE tokenizer) via ctypes
- ``utils``      config system, metric writers, checkpoint manager, profiling
"""

__version__ = "0.1.0"
