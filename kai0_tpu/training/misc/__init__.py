"""Misc config packs: RoboArena + PolaRiS DROID baselines (reference
``src/openpi/training/misc/``), merged into the main registry."""
