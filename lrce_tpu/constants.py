"""Framework-wide constants.

Mirrors the reference constants surface (reference constants.py:1-10) minus the
torch device pick (JAX manages devices through jax.devices()/Mesh).
"""

VIDEO_EXT = (".avi", ".gif", ".mp4")
CLS_TOKEN = "[CLS]"
SEP_TOKEN = "[SEP]"
VIDEO_CACHE_SIZE = 30000
SANITY_CHECK_SIZE = 500

# Label value that is excluded from the cross-entropy loss and can never be
# predicted (reference constants.py:10; used for out-of-vocabulary answers).
IGNORE_INDEX = -100

# ImageNet normalization applied to video frames before the Swin backbone
# (reference lrce/feature_extractor/video.py:35).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
