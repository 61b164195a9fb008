# Prediction writing + evaluation metrics (reference flair_hub/writer).
