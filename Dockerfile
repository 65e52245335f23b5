# Serving image for metavoice-tpu (counterpart of the reference's CUDA
# Dockerfile + docker-compose server service; reference Dockerfile:1,49).
# Run on a TPU VM host with the libtpu runtime exposed to the container.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY metavoice_tpu ./metavoice_tpu

# TPU wheel: on Cloud TPU VMs use jax[tpu] with the libtpu releases index.
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

# checkpoints are mounted at /models
VOLUME ["/models", "/outputs"]
EXPOSE 58003

ENTRYPOINT ["python", "-m", "metavoice_tpu.cli", "serve", \
    "--host", "0.0.0.0", "--port", "58003", "--batching", "8", \
    "--first_stage_path", "/models/first_stage.pt", \
    "--second_stage_path", "/models/second_stage.pt", \
    "--speaker_encoder_path", "/models/speaker_encoder.pt", \
    "--output_dir", "/outputs"]
