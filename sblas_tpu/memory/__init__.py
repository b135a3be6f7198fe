"""Memory-residency subsystem: host-DRAM-spilled operands (UM analog)."""

from .host import (HostResidentPlan, host_resident_plan, spmm_um,  # noqa: F401
                   spmv_um)
