"""Utilities: number formatting, logging, profiling helpers."""

from particle_simulator_tpu.utils.numfmt import NumFormat, NumFormatter, format_with_underscores

__all__ = ["NumFormat", "NumFormatter", "format_with_underscores"]
