"""SPMD sharding hygiene: the TP+ZeRO train step must compile without XLA's
"Involuntary full rematerialization" warning.

Round-1 regression: the shared-embedding gradient came out of the backward
sharded over ``model`` on its d_model axis, and resharding it into the
``data``-sharded optimizer moment forced SPMD to replicate-then-repartition
the tensor every step. The fix pins gradients to the param shardings before
the optimizer (``make_train_step``). This test compiles the retrieval step
(the triggering graph) on the 8-device CPU mesh in a subprocess and greps
stderr — the warning is emitted by XLA's C++ logging, invisible in-process.
"""

import subprocess
import sys

REPRO = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from reprover_tpu.models.t5 import T5Config, init_params
from reprover_tpu.parallel import make_mesh
from reprover_tpu.training import (
    retrieval_loss, init_train_state, make_optimizer, make_train_step,
)

mesh = make_mesh(data=4, model=2)
cfg = T5Config(vocab_size=384, d_model=64, d_kv=16, d_ff=128, num_heads=4,
               num_encoder_layers=2, num_decoder_layers=2,
               compute_dtype=jnp.float32)
tx = make_optimizer(lr=1e-4, warmup_steps=10)
params = init_params(jax.random.PRNGKey(1), cfg)
state = init_train_state(params, tx)
step = make_train_step(retrieval_loss, cfg, tx, mesh=mesh, model_parallel=True)
rng = np.random.default_rng(0)
b = 8
def ids(*shape):
    return jnp.asarray(rng.integers(3, cfg.vocab_size, shape), jnp.int32)
batch = {
    "context_ids": ids(b, 16), "context_mask": jnp.ones((b, 16), jnp.int32),
    "premise_ids": ids(2 * b, 16),
    "premise_mask": jnp.ones((2 * b, 16), jnp.int32),
    "label": jnp.zeros((b, 2 * b), jnp.float32).at[:, :b].set(jnp.eye(b)),
}
state, loss = step(state, batch)
assert np.isfinite(float(loss))
print("STEP_OK")
"""


def test_tp_zero_step_has_no_involuntary_rematerialization():
    proc = subprocess.run(
        [sys.executable, "-c", REPRO],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "STEP_OK" in proc.stdout, proc.stdout + proc.stderr
    assert "Involuntary full rematerialization" not in proc.stderr, proc.stderr
