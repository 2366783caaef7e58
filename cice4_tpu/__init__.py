"""cice4_tpu — a TPU-native sea-ice model framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
the CICE 4.1 (LANL) sea-ice model with COSIMA/ACCESS extensions:
EVP dynamics, incremental remapping transport, multi-category
thermodynamics with ridging, forcing/coupling, history and exact
restart — designed for SPMD execution over TPU device meshes.
"""

from cice4_tpu.config import (Config, gx3_config, col_config)
from cice4_tpu.grid import Grid, make_grid, to_ugrid, to_tgrid
from cice4_tpu.state import State, ItdParams, make_itd_params, init_state

__version__ = "0.1.0"
