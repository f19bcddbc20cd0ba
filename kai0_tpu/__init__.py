"""kai0-tpu: a TPU-native rebuild of the OpenDriveLab/kai0 (χ₀) robot-manipulation stack.

One idiomatic JAX/XLA/Pallas implementation of the π₀ / π₀.₅ Vision-Language-Action
family (SigLIP ViT + multi-expert Gemma + flow-matching action expert), trained over a
``(batch, fsdp)`` device mesh via jit/GSPMD, plus kai0's research modules
(Model Arithmetic, Stage Advantage, Train-Deploy Alignment) and a low-latency
websocket action-chunk serving stack.

Structural parity is tracked against the reference at /root/reference (see SURVEY.md);
file:line citations in docstrings refer to that tree.
"""

__version__ = "0.1.0"
