"""flair-for-aigle-tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
kezakool/flair-for-aigle Earth-observation segmentation stack.

Two entry stacks, mirroring the reference (/root/reference SURVEY.md section 1):

* ``flair_for_aigle_tpu.train`` + ``flair_for_aigle_tpu.models`` + ``.data``:
  the FLAIR-HUB multimodal training/predict pipeline (replaces
  flair_hub/ PyTorch-Lightning stack).
* ``flair_for_aigle_tpu.zonal`` + ``.geo`` + ``.aigle``: the production
  sliding-window ("zonal") inference pipeline with on-device stitching
  (replaces flair_zonal_detection/ + scripts/ + utils/).

Design stance: functional flax models compiled with jit/pjit over a
``jax.sharding.Mesh``; static shapes everywhere; host does raster IO (native
C++ on libtiff), device does normalize/resample/forward/stitch.
"""

__version__ = "0.1.0"
