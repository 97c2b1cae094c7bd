# circuitvision-tpu serving container.
#
# Counterpart of the reference's Dockerfile (python:3.12-slim + ngspice,
# reference Dockerfile:5-36); here the SPICE engine is first-party
# (sim/native built below), and the compute path expects a TPU runtime
# mounted by the host (Cloud TPU VM images provide libtpu; for CPU-only
# smoke deployments the pipeline runs with JAX_PLATFORMS=cpu).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt ./
RUN pip install --no-cache-dir -r requirements.txt

COPY circuitvision_tpu ./circuitvision_tpu
COPY bench.py __graft_entry__.py ./
COPY scripts ./scripts

# Build the native MNA solver.
RUN python -m circuitvision_tpu.sim.build_native

EXPOSE 8501
ENV LOG_LEVEL=INFO
CMD ["python", "-m", "circuitvision_tpu.webapp", "--port", "8501"]
