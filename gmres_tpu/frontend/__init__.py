"""Front ends (L1): SPICE-subset parser + MNA stamping, thermal GCB matrix
directories, source waveform evaluation."""

from gmres_tpu.frontend.gcb import read_gcb, write_vector, read_mtx, write_mtx

__all__ = ["read_gcb", "write_vector", "read_mtx", "write_mtx"]
