"""Top-level arg module alias (reference surface: `import args`;
reference args.py:5-155). Implementation lives in lrce_tpu.config."""

from lrce_tpu.config import parse_arg_eval, parse_arg_train  # noqa: F401
