"""Indexer CLI and Orbax->HF checkpoint conversion script."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reprover_tpu.models.hf_import import export_hf_t5, load_hf_t5
from reprover_tpu.models.t5 import T5Config, init_params

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = T5Config(
    d_model=32,
    d_kv=8,
    d_ff=64,
    num_heads=4,
    num_encoder_layers=2,
    num_decoder_layers=2,
)


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    params = init_params(jax.random.PRNGKey(0), TINY)
    out = str(tmp_path_factory.mktemp("hf") / "ckpt")
    export_hf_t5(params, TINY, out)
    return out


def test_indexer_cli(tiny_hf_dir, toy_corpus_path, tmp_path, monkeypatch):
    from reprover_tpu.retrieval import indexer

    out = str(tmp_path / "indexed")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "indexer",
            "--ckpt-path", tiny_hf_dir,
            "--corpus-path", toy_corpus_path,
            "--output-path", out,
            "--batch-size", "4",
            "--max-seq-len", "128",
        ],
    )
    indexer.main()

    from reprover_tpu.data import IndexedCorpus

    indexed = IndexedCorpus.load(out)
    assert indexed.embeddings.shape == (len(indexed.corpus), TINY.d_model)
    norms = np.linalg.norm(indexed.embeddings, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-3)

    # The artifact feeds a fresh retriever without re-embedding.
    from reprover_tpu.retrieval import PremiseRetriever

    params, cfg = load_hf_t5(tiny_hf_dir, encoder_only=True)
    r = PremiseRetriever(params, cfg, max_seq_len=128)
    r.load_corpus(out)
    assert not r.embeddings_staled


def test_convert_checkpoint_script(tiny_hf_dir, tmp_path):
    """Orbax training ckpt -> HF dir via scripts/convert_checkpoint.py."""
    from reprover_tpu.training import init_train_state, make_optimizer
    from reprover_tpu.utils import CheckpointManager

    params, cfg = load_hf_t5(tiny_hf_dir)
    tx = make_optimizer(1e-4, 1)
    state = init_train_state(params, tx)
    ck = str(tmp_path / "orbax")
    mgr = CheckpointManager(ck)
    mgr.save(7, state)
    mgr.wait()
    mgr.close()

    dst = str(tmp_path / "hf_out")
    env = dict(os.environ, PYTHONPATH=REPO_ROOT, JAX_PLATFORMS="cpu")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO_ROOT, "scripts", "convert_checkpoint.py"),
            "generator",
            "--src", ck,
            "--hf-config", tiny_hf_dir,
            "--dst", dst,
        ],
        check=True,
        env=env,
        cwd=REPO_ROOT,
    )
    reloaded, cfg2 = load_hf_t5(dst)
    from reprover_tpu.models.t5 import encode

    ids = jnp.ones((1, 16), jnp.int32)
    mask = jnp.ones((1, 16), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(encode(params, cfg, ids, mask)),
        np.asarray(encode(reloaded, cfg2, ids, mask)),
        atol=1e-5,
        rtol=1e-5,
    )
