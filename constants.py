"""Top-level constants alias (reference surface: `from constants import *`;
reference constants.py:1-10). Implementation lives in lrce_tpu.constants."""

from lrce_tpu.constants import (  # noqa: F401
    CLS_TOKEN,
    IGNORE_INDEX,
    SANITY_CHECK_SIZE,
    SEP_TOKEN,
    VIDEO_CACHE_SIZE,
    VIDEO_EXT,
)
