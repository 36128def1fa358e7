import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
import reprover_tpu.generation.engine as E
from reprover_tpu.generation.generator import TacticGeneratorModel
from reprover_tpu.models.t5 import byt5_small, fuse_mlp_params, init_params
from reprover_tpu.models.t5 import _dense, _lm_logits, _split_heads, relative_position_bucket, rms_norm

cfg = byt5_small(compute_dtype=jnp.bfloat16, flash_encoder=True, unroll_encoder=True)
params = fuse_mlp_params(init_params(jax.random.PRNGKey(0), cfg))
model = TacticGeneratorModel(params, cfg, max_inp_seq_len=512, max_oup_seq_len=128)
rng = np.random.default_rng(0)

def measure(tag):
    eng = model.make_stepwise_engine(num_slots=8, num_beams=64, chunk_size=8)
    def admit_all():
        texts = ["".join(chr(97 + rng.integers(0, 26)) for _ in range(200)) for _ in range(8)]
        ids, mask = model.tokenize_for_engine(texts)
        eng.admit_batch_tokens(list(range(8)), ids, mask)
    admit_all()
    st = eng.dispatch_run(2); np.asarray(st)
    best = 1e9
    for _ in range(2):
        admit_all()
        t0 = time.monotonic()
        st = eng.dispatch_run(64)
        arr = np.asarray(st)
        wall = time.monotonic() - t0
        steps = int(arr[24])
        best = min(best, wall / max(steps, 1))
    print({tag: round(1000 * best, 2)}, flush=True)

orig_decode = E._engine_decode_step

def make_decode(skip_writes=False, skip_proj=False):
    def decode(params, cfg, state):
        dt = cfg.compute_dtype
        dec = params["decoder"]
        S, K = state.last_token.shape
        T = state.self_k.shape[4]
        H, d = cfg.num_heads, cfg.d_kv
        pos = state.n - 1
        h = params["shared_embedding"].astype(dt)[state.last_token]
        h = h[:, :, None, :]
        key_positions = jnp.arange(T)
        rel = key_positions[None, :] - pos[:, None]
        buckets = relative_position_bucket(rel, False, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
        self_bias = jnp.transpose(dec["rel_bias"][buckets], (0, 2, 1)).astype(jnp.float32)[:, None, :, None, :]
        valid = (key_positions[None, :] <= pos[:, None])[:, None, None, None, :]
        self_bias = jnp.where(valid, self_bias, -1e10)
        cross_bias = state.cross_bias[:, None]

        def write_col(cache, new, p):
            return jax.lax.dynamic_update_slice(cache, new, (0, 0, p, 0))
        write_kv = jax.vmap(write_col)

        def layer(carry, inputs):
            hh = carry
            lp, k_cache, v_cache, ck, cv = inputs
            eps = cfg.layer_norm_epsilon
            def proj(x, w):
                if skip_proj:
                    return jnp.zeros((S, K, H, 1, d), dt) + x.mean()
                y = _dense(x.reshape(S * K, 1, -1), w, dt)
                return _split_heads(y, H, d).reshape(S, K, H, 1, d)
            nrm = rms_norm(hh, lp["self_norm"], eps)
            q = proj(nrm, lp["self_attn"]["q"])
            k_new = proj(nrm, lp["self_attn"]["k"])
            v_new = proj(nrm, lp["self_attn"]["v"])
            if not skip_writes:
                k_cache = write_kv(k_cache, k_new.astype(k_cache.dtype), pos)
                v_cache = write_kv(v_cache, v_new.astype(v_cache.dtype), pos)
            attn = E._beam_attention(q, k_cache, v_cache, self_bias, dt)
            hh = hh + _dense(attn.transpose(0, 1, 3, 2, 4).reshape(S * K, 1, H * d), lp["self_attn"]["o"], dt).reshape(S, K, 1, -1)
            nrm = rms_norm(hh, lp["cross_norm"], eps)
            q = proj(nrm, lp["cross_attn"]["q"])
            attn = E._grouped_attention(q, ck, cv, cross_bias, dt)
            hh = hh + _dense(attn.transpose(0, 1, 3, 2, 4).reshape(S * K, 1, H * d), lp["cross_attn"]["o"], dt).reshape(S, K, 1, -1)
            from reprover_tpu.models.t5 import _mlp_block
            hh = hh + _mlp_block(rms_norm(hh, lp["mlp_norm"], eps), lp["mlp"], cfg)
            return hh, (k_cache, v_cache)

        hh, (new_k, new_v) = jax.lax.scan(layer, h, (dec["layers"], state.self_k, state.self_v, state.cross_k, state.cross_v))
        hh = rms_norm(hh, dec["final_norm"], cfg.layer_norm_epsilon)
        logits = _lm_logits(params, cfg, hh.reshape(S * K, 1, -1))[:, 0, :]
        return logits.reshape(S, K, -1), dataclasses.replace(state, self_k=new_k, self_v=new_v)
    return decode

E._engine_decode_step = make_decode()
measure("replica_sanity")
E._engine_decode_step = make_decode(skip_writes=True)
measure("no_kv_writes")
E._engine_decode_step = make_decode(skip_proj=True)
measure("no_projections")
E._engine_decode_step = orig_decode
