"""CLI entry points (installed as the `kai0_scripts` package; also runnable
as files from a checkout: `python scripts/train.py ...`)."""
