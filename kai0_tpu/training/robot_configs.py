"""Named robot/task train configs (Aloha, Libero, Agilex, ARX, DROID, kai0 tasks).

Filled out alongside the per-robot policy transforms in ``kai0_tpu/policies``;
parity target: reference config.py:761-1394.
"""

from __future__ import annotations


def configs() -> list:
    from kai0_tpu.training import config as _config  # noqa: F401

    return []
