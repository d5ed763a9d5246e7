from lrce_tpu.utils.logging import get_logger, setup_logging
from lrce_tpu.utils.vocab import (
    build_answer_dict,
    build_common_answer_dict,
    build_video_dict,
    parse_tgif_annot,
)
