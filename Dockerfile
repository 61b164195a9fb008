# flair-for-aigle-tpu runtime image.
# Build: docker build -t flair-for-aigle-tpu .
# The base must provide a TPU-enabled JAX; on GPU/CPU hosts swap the base
# and JAX wheel accordingly.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libtiff6 libtiff-dev libgeos-c1v5 libproj25 \
        libopenjp2-7 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY flair_for_aigle_tpu ./flair_for_aigle_tpu
COPY native ./native
COPY configs ./configs
COPY color-styles ./color-styles
COPY main.py zonal_main.py train_main.py bench.py ./
RUN make -C native

ENTRYPOINT ["python", "main.py"]
