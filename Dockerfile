# open_vins_tpu — container build (SURVEY.md §2.10 packaging parity; the
# reference ships six ROS1/ROS2 Dockerfiles — here one image covers the
# CPU-mesh test profile and, with the TPU base swap below, real-chip runs).
#
#   docker build -t open_vins_tpu .
#   docker run --rm open_vins_tpu python -m pytest tests/ -q
#   docker run --rm open_vins_tpu python bench.py
#
# For TPU VMs use a libtpu-enabled base instead (e.g.
# `FROM python:3.12-slim` + `pip install jax[tpu] -f
# https://storage.googleapis.com/jax-releases/libtpu_releases.html`).

FROM python:3.12-slim AS base

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ cmake ninja-build libopencv-dev \
    && rm -rf /var/lib/apt/lists/*

# estimator + eval dependencies (CPU jaxlib by default; see header for TPU)
RUN pip install --no-cache-dir \
        "jax>=0.9" "numpy>=2.0" "scipy>=1.14" "opencv-python-headless>=4.10" \
        pytest

WORKDIR /opt/open_vins_tpu
COPY open_vins_tpu/ open_vins_tpu/
COPY examples/ examples/
COPY tests/ tests/
COPY native/CMakeLists.txt native/*.cpp native/
COPY conftest.py pytest.ini bench.py __graft_entry__.py ./

# native host runtime (sensor hub + EuRoC loader), ctypes-loaded at import
RUN cmake -S native -B native/build -G Ninja \
    && cmake --build native/build

ENV PYTHONPATH=/opt/open_vins_tpu

# Optional compile-cache prebake (VERDICT r03 #10): the default suite is
# compile-dominated (~48 min cold vs ~30 min warm).  Building with
#   docker build --build-arg PREBAKE_CACHE=1 -t open_vins_tpu .
# runs the suite once at image-build time so the persistent CPU compile
# cache (conftest.py: ~/.cache/ovt_cpu_test_cache) ships inside the image
# and CI containers start warm.  Default off to keep plain builds fast.
ARG PREBAKE_CACHE=0
RUN if [ "$PREBAKE_CACHE" = "1" ]; then \
        python -m pytest tests/ -q || true; \
    fi

CMD ["python", "-m", "pytest", "tests/", "-q"]
