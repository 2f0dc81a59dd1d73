# fastdm_tpu serving image (ref analog: the reference's CUDA Dockerfile —
# here the base is a TPU-ready JAX image; no custom CUDA libs to build,
# the one native piece (fastdm_tpu/native/quant.cpp) is g++-compiled on
# first use inside the container).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/fastdm_tpu
COPY pyproject.toml README.md ./
COPY fastdm_tpu ./fastdm_tpu
COPY examples ./examples
COPY comfyui ./comfyui

# jax[tpu] pulls libtpu; torch stays CPU-only (host-side text encoders)
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu \
    && pip install --no-cache-dir ".[torch,serve,dev]"

EXPOSE 8000
ENTRYPOINT ["python", "examples/serve/api_server.py"]
