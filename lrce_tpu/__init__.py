"""lrce_tpu — TPU-native (JAX/XLA/Pallas) framework with the capabilities of
Sejong-VLI/VQA-LRCE-KBS-2023 ("Lightweight Recurrent Cross-modal Encoder").

The reference stack (reference: /root/reference, readme.md:1) is a VideoQA
research framework: BERT text encoder + Video Swin-B 3D video encoder + a
recurrent cross-modal fusion transformer with open-ended / multiple-choice /
count heads, trained data-parallel over GPUs.

This package is a ground-up TPU-first redesign:
  - functional models with pytree parameters (jit/pjit friendly),
  - bf16 compute / f32 params instead of CUDA AMP,
  - `jax.sharding.Mesh` + GSPMD data parallelism instead of DDP/NCCL,
  - `lax.scan` recurrences instead of Python loops,
  - Pallas fused kernels for the 3D shifted-window attention hot path,
  - a C++ host runtime (GIF decode, WordPiece tokenization) for the input
    pipeline instead of OpenCV/HF-tokenizers.
"""

__version__ = "0.1.0"
