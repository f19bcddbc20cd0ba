"""Train-Deploy Alignment data augmentation: dataset-level LeRobot transforms.

- :mod:`.time_scaling` — speed augmentation: keep every Nth frame (video + parquet)
  at unchanged fps, so demonstrations play back faster; optional split mode scales a
  fraction of episodes and merges with the originals.
- :mod:`.space_mirroring` — mirror augmentation for dual-arm robots: swap
  left/right arm dims in state/action, horizontally flip videos with the wrist
  cameras swapped, mirror norm stats, then merge original + mirrored.
- :mod:`.convert_h5` — DAgger/ALOHA HDF5 episodes (+ per-camera mp4s) → LeRobot.
"""

from kai0_tpu.augment.convert_h5 import convert_h5_to_lerobot  # noqa: F401
from kai0_tpu.augment.space_mirroring import create_mirror_dataset, swap_arms_in_array  # noqa: F401
from kai0_tpu.augment.time_scaling import time_scale_dataset  # noqa: F401
