"""Train-Deploy Alignment: latency-compensated inference clients + DAgger tooling.

The reference buries these algorithms inside 1.2–1.7k-line ROS scripts
(``train_deploy_alignment/inference/agilex/inference/*.py``); here they are
importable, unit-tested library modules:

- :mod:`.buffers` — ``StreamActionBuffer`` (temporal-smoothing crossfade),
  ``TemporalEnsemblingBuffer`` (ACT-style exponential aggregation),
  ``DelayEstimator`` + ``rtc_align_chunks`` (real-time-chunking execution).
- :mod:`.rtc_client` — RTC payload assembly + latency bookkeeping around any
  ``BasePolicy`` (websocket client or in-process policy).
- :mod:`.dagger` — policy-in-the-loop episode collector writing HDF5 (+ LeRobot
  conversion via ``kai0_tpu.augment.convert_h5``).
"""

from kai0_tpu.deploy.buffers import (  # noqa: F401
    DelayEstimator,
    StreamActionBuffer,
    TemporalEnsemblingBuffer,
    rtc_align_chunks,
)
