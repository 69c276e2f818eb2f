"""Pallas TPU kernels: flash attention (+ fused rotary)."""
