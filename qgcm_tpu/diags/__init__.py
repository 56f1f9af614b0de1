"""Diagnostics: validity scans, CFL, monitoring/energy budget."""

from .valids import valids, ValidityReport  # noqa: F401
from .cfl import cfl_numbers  # noqa: F401
from .monitor import compute_monitor, MonitorWriter  # noqa: F401
