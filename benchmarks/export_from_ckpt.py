"""Export an HF-layout dir from a raw Orbax pretrain checkpoint, offline.

The pretrain CLI exports only at the end of its time budget; this tool turns
any preserved intermediate step into the same artifact, so fine-tunes can
start from an early-stop point (round-5 flagship: zero-shot retrieval peaks
before pretrain loss does — see BASELINE.md round 5).

Usage: python benchmarks/export_from_ckpt.py <ckpt_step_dir> <out_dir>
       e.g. python benchmarks/export_from_ckpt.py /tmp/byt5c_keep/9000 \
                /tmp/byt5c_step9k_export
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def load_ckpt_params(step_dir: str):
    """Restore just the params subtree from a TrainState Orbax step dir."""
    import orbax.checkpoint as ocp

    cpu = jax.devices("cpu")[0]
    sharding = jax.sharding.SingleDeviceSharding(cpu)
    path = os.path.join(step_dir, "default")
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
        meta = getattr(meta, "item_metadata", meta)
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
            meta,
        )
        state = ckptr.restore(path, abstract)
    if isinstance(state, (list, tuple)):
        return next(x for x in state if isinstance(x, dict) and "encoder" in x)
    return state["params"]


def main():
    step_dir, out_dir = sys.argv[1], sys.argv[2]
    from reprover_tpu.models.hf_import import export_hf_t5
    from reprover_tpu.models.t5 import byt5_small

    params = load_ckpt_params(step_dir)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    cfg = byt5_small(compute_dtype=jnp.float32)
    export_hf_t5(params, cfg, out_dir)
    print(f"exported {step_dir} -> {out_dir}")


if __name__ == "__main__":
    main()
