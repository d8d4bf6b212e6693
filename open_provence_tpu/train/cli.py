"""``python -m open_provence_tpu.train.cli <config.yaml>`` — the trainer CLI
(reference trainer_cli.py)."""

from .runner import main

if __name__ == "__main__":
    main()
