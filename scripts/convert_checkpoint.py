"""Convert an Orbax training checkpoint to an HF-format directory.

Parity with `/root/reference/scripts/convert_checkpoint.py` (Lightning /
DeepSpeed -> HF ``save_pretrained``), for this framework's artifacts: the
training state lives in Orbax; serving/interop artifacts are HF-layout
safetensors written by :func:`reprover_tpu.models.hf_import.export_hf_t5`.

Usage::

    python scripts/convert_checkpoint.py retriever \
        --src runs/exp/ckpts --hf-config google/byt5-small --dst out_dir
"""

import argparse
import logging

logger = logging.getLogger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("model_type", choices=["generator", "retriever"])
    parser.add_argument("--src", type=str, required=True, help="Orbax ckpt dir")
    parser.add_argument(
        "--hf-config",
        type=str,
        required=True,
        help="HF checkpoint dir providing the model geometry (config.json)",
    )
    parser.add_argument("--dst", type=str, required=True)
    parser.add_argument("--step", type=int, default=None)
    args = parser.parse_args()
    # force=True: the axon TPU plugin's backend init installs a root
    # handler (absl) before main() runs, which would turn this into a
    # no-op and silently drop all INFO progress logs on TPU.
    logging.basicConfig(level=logging.INFO, force=True)

    from reprover_tpu.models import init_params, load_hf_t5
    from reprover_tpu.models.hf_import import export_hf_t5
    from reprover_tpu.training import init_train_state, make_optimizer
    from reprover_tpu.utils import CheckpointManager

    import jax

    encoder_only = args.model_type == "retriever"
    params, cfg = load_hf_t5(args.hf_config, encoder_only=encoder_only)
    # Template matching the training state structure.
    tx = make_optimizer(lr=1e-4, warmup_steps=1)
    state = init_train_state(params, tx)
    mgr = CheckpointManager(args.src)
    restored = mgr.restore(state, step=args.step)
    export_hf_t5(restored.params, cfg, args.dst, encoder_only=encoder_only)
    logger.info("saved HF-format model to %s", args.dst)


if __name__ == "__main__":
    main()
