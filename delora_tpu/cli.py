"""Command-line entry points: ``delora train|test|preprocess|bench|serve``.

Replaces the reference's bin/ scripts (reference bin/run_training.py,
run_testing.py, preprocess_data.py, run_rosnode.py) with one argparse CLI.
Config behavior parity:
  * three-YAML merge with CLI overrides (run_training.py:22-29),
  * on resume/test, the config embedded in the checkpoint is rehydrated and
    re-overridden with device/dataset/identifier flags (run_training.py:47-55,
    run_testing.py:41-53),
  * mode-dependent identifier mapping (training vs testing vs preprocessing).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict, Optional

from delora_tpu.config import load_config


def _common_flags(p: argparse.ArgumentParser):
    p.add_argument("--config", nargs="*", default=None,
                   help="YAML config files (default: packaged stack)")
    p.add_argument("--set", dest="overrides", nargs="*", default=[],
                   metavar="KEY=VALUE",
                   help="Config overrides, e.g. --set batch_size=64 datasets='[\"kitti\"]'")
    p.add_argument("--checkpoint", default=None)


def _parse_overrides(pairs) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for pair in pairs:
        key, _, value = pair.partition("=")
        try:
            out[key] = json.loads(value)
        except json.JSONDecodeError:
            out[key] = value
    return out


def _build_config(args, mode: str) -> Dict[str, Any]:
    overrides = _parse_overrides(args.overrides)
    if args.checkpoint:
        overrides["checkpoint"] = args.checkpoint
        # Rehydrate config embedded in the checkpoint (run_training.py:47-55).
        from delora_tpu.training.checkpoint import CheckpointManager

        embedded = CheckpointManager.embedded_config(args.checkpoint)
        if embedded:
            merged = dict(embedded)
            merged.update(overrides)
            merged["_fov_in_radians"] = embedded.get("_fov_in_radians", False)
            overrides = merged
    return load_config(overrides=overrides, config_files=args.config, mode=mode)


def cmd_train(args):
    config = _build_config(args, "training")
    config.setdefault("training_run_name", args.run_name or "run")
    from delora_tpu.parallel.mesh import initialize_multihost, make_mesh
    from delora_tpu.training.trainer import Trainer

    initialize_multihost()
    mesh = None
    import jax

    if len(jax.devices()) > 1:
        mesh = make_mesh()
    trainer = Trainer(config, mesh=mesh, run_name=args.run_name)
    trainer.train(max_epochs=args.epochs)


def cmd_test(args):
    config = _build_config(args, "testing")
    config["inference_only"] = True
    from delora_tpu.training.tester import Tester

    tester = Tester(config, run_name=args.run_name)
    results = tester.test()
    print(json.dumps({d: {str(s): m for s, m in v.items()}
                      for d, v in results.items()}, indent=2))


def cmd_preprocess(args):
    config = _build_config(args, "preprocessing")
    from delora_tpu.data.preprocess import Preprocessor

    pre = Preprocessor(config)
    for dataset in config["datasets"]:
        if args.preview:
            pre.preview(dataset)
            continue
        n = pre.run_dataset(dataset, max_scans=args.max_scans)
        print(f"[preprocess] {dataset}: {n} scans written")


def cmd_bench(args):
    import subprocess

    sys.exit(subprocess.call([sys.executable, "bench.py"] + (args.bench_args or [])))


def cmd_export_torch(args):
    """Export a delora_tpu checkpoint as a reference-format torch .pth.

    Inverse of the torch importer; the counterpart of the reference's own
    deployment converter (reference scripts/convert_pytorch_models.py)."""
    config = _build_config(args, "testing")
    if not args.checkpoint:
        raise SystemExit("--checkpoint is required")
    import os

    import jax.numpy as jnp

    from delora_tpu.models.odometry import ModelConfig, OdometryModel
    from delora_tpu.training.checkpoint import CheckpointManager
    from delora_tpu.training.state import create_train_state
    from delora_tpu.utils.torch_import import save_reference_checkpoint

    model = OdometryModel(ModelConfig.from_config(config))
    ds0 = config[config["datasets"][0]]
    example = jnp.zeros((1, ds0["vertical_cells"], ds0["horizontal_cells"], 4))
    state = create_train_state(model, config, example)
    ckpt_dir = config["checkpoint"]
    mgr = CheckpointManager(os.path.dirname(ckpt_dir.rstrip("/")) or ".")
    state, meta = mgr.restore(state, os.path.basename(ckpt_dir.rstrip("/")))
    save_reference_checkpoint(
        args.out, state.params, config=meta.get("parameters", config),
        epoch=int(meta.get("epoch", 0)), loss=float(meta.get("loss", 0.0)),
        blocks_per_stage=tuple(config["layers"]),
        use_single_mlp=bool(config["use_single_mlp_at_output"]),
    )
    print(f"[export-torch] wrote {args.out}")


def cmd_visualize_normals(args):
    """Render normals of a preprocessed scan (parity with the reference's
    bin/visualize_pointcloud_normals.py RViz flow, headless)."""
    import os
    import subprocess

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "visualize_normals.py",
    )
    cmd = [sys.executable, script, args.sequence_dir, str(args.scan)]
    if args.out:
        cmd.append(args.out)
    sys.exit(subprocess.call(cmd))


def cmd_serve(args):
    config = _build_config(args, "testing")
    from delora_tpu.serving.stream import StreamingOdometry

    engine = StreamingOdometry(config, checkpoint=args.checkpoint,
                               dataset=args.dataset)
    engine.serve_stdin()


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser(prog="delora")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="self-supervised training")
    _common_flags(p)
    p.add_argument("--run-name", default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("test", help="sequential evaluation -> trajectories")
    _common_flags(p)
    p.add_argument("--run-name", default=None)
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("preprocess", help="raw scans -> dedup points + normals")
    _common_flags(p)
    p.add_argument("--max-scans", type=int, default=None)
    p.add_argument("--preview", action="store_true",
                   help="render the first scan's range/normal images and stop")
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("bench", help="run the benchmark suite")
    p.add_argument("bench_args", nargs="*")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("export-torch",
                       help="checkpoint -> reference-format torch .pth")
    _common_flags(p)
    p.add_argument("--out", required=True, help="output .pth path")
    p.set_defaults(fn=cmd_export_torch)

    p = sub.add_parser("visualize-normals",
                       help="render a preprocessed scan's normals (quiver)")
    p.add_argument("sequence_dir",
                   help="preprocessed sequence dir (contains scans/ normals/)")
    p.add_argument("--scan", type=int, default=0)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_visualize_normals)

    p = sub.add_parser("serve", help="streaming odometry (10 Hz budget)")
    _common_flags(p)
    p.add_argument("--dataset", default="kitti")
    p.set_defaults(fn=cmd_serve)

    args = parser.parse_args(argv)
    from delora_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
