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

- ``data``       corpus DAG / accessibility bitmasks / datasets (host, NumPy)
- ``models``     functional T5 (ByT5) in JAX + HF weight import
- ``ops``        Pallas kernels and fused device ops (attention, top-k, pooling)
- ``parallel``   mesh + sharding specs (DP / TP / ZeRO-style optimizer sharding)
- ``retrieval``  premise retriever, indexer, R@k/MRR evaluation, BM25 baseline
- ``generation`` tactic generator, beam search, preprocessing
- ``prover``     search tree, best-first search, Pass@1 harness
- ``serving``    batched TPU inference engine (continuous batching)
- ``training``   optax/orbax training loops for retriever + generator
"""

__version__ = "0.1.0"
