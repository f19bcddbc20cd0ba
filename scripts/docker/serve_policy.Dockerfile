# Policy-server image for TPU hosts (equivalent of the reference
# scripts/docker/serve_policy.Dockerfile, which targets CUDA hosts).
#
# Build:  docker build -f scripts/docker/serve_policy.Dockerfile -t kai0-tpu-serve .
# Run on a TPU VM (the TPU is exposed via /dev and privileged mode, no extra
# container toolkit needed — unlike the reference's nvidia runtime):
#   docker run --privileged --net=host \
#     -v /path/to/checkpoints:/checkpoints kai0-tpu-serve \
#     --policy.config=pi05_flatten_fold_normal --policy.dir=/checkpoints/29999

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgl1 libglib2.0-0 g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# TPU-enabled JAX + the serving dependencies.
RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax orbax-checkpoint einops opencv-python-headless \
    websockets msgpack numpy pillow

COPY kai0_tpu /app/kai0_tpu
COPY scripts /app/scripts
COPY packages /app/packages

ENV PYTHONPATH=/app:/app/packages/kai0-client/src
EXPOSE 8000

ENTRYPOINT ["python", "scripts/serve_policy.py", "policy:checkpoint"]
