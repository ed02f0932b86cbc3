# margipose-tpu container image.
#
# TPU-native replacement for the reference's CUDA image
# (reference: Dockerfile — cuda 10.0 + conda + pytorch 1.1.0): a plain
# Python base with jax[tpu]; on Cloud TPU VMs the TPU runtime is provided
# by the host (libtpu via the tpu extra).
FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ ffmpeg \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY margipose_tpu ./margipose_tpu
COPY native ./native
COPY resources ./resources

RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir flax optax orbax-checkpoint einops h5py pillow pandas tabulate tqdm scipy \
    && pip install --no-cache-dir -e . \
    && sh native/build.sh

# Dataset mount point (reference: docker-compose.yml.example volumes)
ENV MARGIPOSE_BASE_DATA_DIR=/datasets
VOLUME /datasets

ENTRYPOINT ["margipose"]
