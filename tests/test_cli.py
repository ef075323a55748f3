"""CLI surface tests.

The reference drives everything through ``main.py``'s argparse surface
(``main.py:198-266``); these tests pin that our parser namespaces carry every
attribute the command implementations read (a missing ``--streaming_steps``
on the ``pipeline`` subparser crashed a real TPU run), and run the
train->benchmark pipeline end-to-end at test size on CPU.
"""

import os

import pytest

from nerf_tpu.cli.main import build_parser, main


def test_every_subcommand_parses_defaults():
    p = build_parser()
    for argv in (
        ["train"],
        ["benchmark"],
        ["render"],
        ["compare"],
        ["smoke"],
        ["scale"],
        ["pipeline"],
        ["export", "--checkpoint", "x.npz", "--out", "y.pth"],
    ):
        args = p.parse_args(argv)
        assert args.command == argv[0]


def test_pipeline_namespace_covers_train_and_benchmark_reads():
    """``cmd_pipeline`` forwards its namespace to ``cmd_train`` and
    ``cmd_benchmark``; every attribute either reads must exist."""
    args = build_parser().parse_args(["pipeline"])
    for attr in (
        # cmd_train reads
        "data_dir", "epochs", "image_size", "no_resume", "streaming_steps",
        "n_rays", "checkpoint_dir", "output_dir",
        # cmd_benchmark reads
        "checkpoint", "resolutions", "samples", "views", "engines",
        "gt_gate", "gt_spp",
    ):
        assert hasattr(args, attr), f"pipeline namespace missing {attr}"


def test_pipeline_end_to_end_tiny(tmp_path):
    """Reference ``main.py`` behavior: train a (tiny procedural) scene,
    save the checkpoint, run the benchmark suite on it."""
    out = tmp_path / "out"
    ckpt_dir = tmp_path / "ckpt"
    rc = main([
        "pipeline",
        "--data_dir", str(tmp_path / "missing"),   # -> procedural scene
        "--epochs", "1",
        "--image_size", "16",
        "--n_rays", "64",
        "--no_resume",
        "--output_dir", str(out),
        "--checkpoint_dir", str(ckpt_dir),
        "--resolutions", "32x24",
        "--samples", "8",
        "--views", "1",
        "--engines", "xla",
    ])
    assert rc == 0
    assert os.path.exists(ckpt_dir / "final_model.npz")
    assert os.path.exists(out / "benchmark_results.json")
