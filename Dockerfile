# Packaging parity with the reference's Dockerfile (SURVEY.md §2 #23): the
# reference ships an NVIDIA PyTorch base image; the TPU-native equivalent is
# a JAX TPU image. Build: docker build -t tpu-unet .
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY tpu_unet ./tpu_unet

# On a real TPU VM, install the TPU-enabled jaxlib instead:
#   pip install -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir .

ENTRYPOINT ["python", "-m", "tpu_unet.train"]
