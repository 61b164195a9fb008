# Config IO, logging/messaging, config recap display (reference flair_hub/utils).
