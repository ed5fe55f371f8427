# TPU-native depth-estimation framework — container build.
#
# Equivalent of the reference's Docker file (PyTorch/CUDA + GL/EGL/Xvfb for
# headless OpenGL rendering, Docker:1-27). No GL stack is needed here: the
# novel-view renderer is pure JAX. Use a JAX TPU base image on Cloud TPU VMs.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libpng-dev libjpeg-dev zlib1g-dev \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

# On a TPU VM use: pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir \
        jax flax optax orbax-checkpoint chex einops numpy pandas pillow \
        opencv-python-headless matplotlib scipy pytest jinja2 seaborn \
    && pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

# Install the package itself (console scripts: ede-train, ede-benchmark, ...).
RUN pip install --no-cache-dir --no-deps --no-build-isolation -e .

# Pre-build the native batch decoder.
RUN python -c "from efficientdepthestimation_tpu.native import build_library; build_library()"

# Sanity: the smoke tier must pass in the fresh container (see DEPLOYMENT.md).
RUN python -m pytest tests/ -m smoke -q

ENTRYPOINT ["ede-train"]
