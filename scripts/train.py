"""Script-level training entry (reference scripts/train_hydra.py:9-36).

The reference uses a hydra-decorated ``train()`` that is also the multi-GPU
launch entry. Here one process drives all chips in the mesh (GSPMD), so a
plain script suffices:

    python scripts/train.py <config.yaml> [key=value ...]
"""

import sys


def main() -> None:
    from lightning_pose_tpu.cli.main import main as cli_main

    args = sys.argv[1:]
    if not args:
        raise SystemExit("usage: python scripts/train.py <config.yaml> [key=value ...]")
    config, *overrides = args
    cli_argv = ["train", config]
    if overrides:
        cli_argv += ["--overrides", *overrides]
    cli_main(cli_argv)


if __name__ == "__main__":
    main()
