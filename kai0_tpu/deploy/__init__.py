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


def make_stream_buffer(*, smooth_method: str = "temporal", prefer_native: bool = True):
    """Best available smoothing buffer: C++ (GIL-free locking) when buildable."""
    if prefer_native:
        from kai0_tpu import native

        if native.load() is not None:
            from kai0_tpu.deploy.native_buffers import NativeStreamActionBuffer

            return NativeStreamActionBuffer(smooth_method=smooth_method)
    return StreamActionBuffer(smooth_method=smooth_method)


def make_ensembling_buffer(*, chunk_size: int = 50, exp_weight_m: float = 0.01, prefer_native: bool = True):
    """Best available ensembling buffer: C++ when buildable."""
    if prefer_native:
        from kai0_tpu import native

        if native.load() is not None:
            from kai0_tpu.deploy.native_buffers import NativeTemporalEnsemblingBuffer

            return NativeTemporalEnsemblingBuffer(chunk_size=chunk_size, exp_weight_m=exp_weight_m)
    return TemporalEnsemblingBuffer(chunk_size=chunk_size, exp_weight_m=exp_weight_m)
