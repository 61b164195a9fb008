# Data layer: pure numpy transforms (norm, sentinel time-series handling,
# augmentations, padding/collate), CSV path resolution, datasets, loaders.
