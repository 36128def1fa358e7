"""Probe: where does the 13B int4 TP=2 serve-loop's 32G of temps come from?

Chipless v5e compile of (a) a single engine step and (b) the 8-step loop,
each at einsum and scan reorder, printing per-chip buffer stats; on OOM,
print the full buffer-assignment dump so the dominant buffers are visible.
"""

import functools
import os
import sys

os.environ["JAX_PLATFORMS"] = ""
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses as dc

import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding as NS, PartitionSpec as P

from reprover_tpu.models import causal_lm
from reprover_tpu.models.quantize import quantize_causal_params
from reprover_tpu.generation.causal_engine import (
    CausalEngineState,
    causal_engine_step,
    init_causal_engine_state,
)
from reprover_tpu.parallel.sharding import causal_param_partition_specs

bf = jnp.bfloat16
topo2 = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2x1")
mesh2 = Mesh(np.array(topo2.devices[:2]).reshape(1, 2), ("data", "model"))

b13 = causal_lm.CausalLMConfig(
    vocab_size=32000, d_model=5120, num_layers=40, num_heads=40,
    num_kv_heads=40, d_ff=13824, compute_dtype=bf,
)
p13 = jax.eval_shape(
    lambda: jax.tree.map(
        lambda x: x.astype(bf), causal_lm.init_params(jax.random.PRNGKey(0), b13)
    )
)
q13_4 = jax.eval_shape(
    functools.partial(quantize_causal_params, kernel_ok=False, bits=4), p13
)
SLOTS = int(os.environ.get("SLOTS", "8"))
s13 = jax.eval_shape(lambda: init_causal_engine_state(b13, SLOTS, 8, 512, 129))

pshard = jax.tree.map(
    lambda sp: NS(mesh2, sp),
    causal_param_partition_specs(q13_4, model_parallel=True),
)
pkv = NS(mesh2, P(None, None, "model", None, None))
dkv = NS(mesh2, P(None, None, None, "model", None, None))
rep2 = NS(mesh2, P())
sshard = CausalEngineState(**{
    **{f.name: rep2 for f in dc.fields(CausalEngineState)},
    "prompt_k": pkv, "prompt_v": pkv, "dec_k": dkv, "dec_v": dkv,
})

pargs = jax.tree.map(
    lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
    q13_4, pshard,
)
sargs = jax.tree.map(
    lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
    s13, sshard,
)


def step_fn(mode):
    def f(p, s):
        return causal_engine_step(p, b13, s, 0.0, reorder_mode=mode)
    return f


def loop_fn(mode):
    def f(p, s):
        return jax.lax.fori_loop(
            0, 8,
            lambda _, st: dc.replace(
                causal_engine_step(p, b13, st, 0.0, reorder_mode=mode),
                n=st.n, done=st.done,
            ),
            s,
        )
    return f


which = sys.argv[1] if len(sys.argv) > 1 else "step_scan"
fns = {
    "step_scan": step_fn("scan"),
    "step_einsum": step_fn("einsum"),
    "loop_scan": loop_fn("scan"),
    "loop_einsum": loop_fn("einsum"),
}
fn = fns[which]
try:
    compiled = jax.jit(fn, donate_argnums=(1,)).lower(pargs, sargs).compile()
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    print(
        f"{which}: OK args {ma.argument_size_in_bytes/gb:.2f} GB + temps "
        f"{ma.temp_size_in_bytes/gb:.2f} GB + out {ma.output_size_in_bytes/gb:.2f} GB"
    )
except Exception as e:
    print(f"{which}: FAIL")
    print(str(e)[:8000])
