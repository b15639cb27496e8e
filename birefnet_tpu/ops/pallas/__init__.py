"""Pallas TPU kernels for the hot ops (flash window attention, deformable
sampling). Imported lazily by the model code so the XLA fallback paths work
without Pallas support (e.g. interpret mode on CPU)."""
