"""Physical constants used across the framework.

Mirrors the constant block in the reference implementation
(structureLibs/water_properties.py:45-55) so that downstream statistics are
directly comparable, but gathers them in one module instead of scattering
them through function defaults.
"""

# Boltzmann constant in J/K
KB_J_PER_K = 1.380648e-23

# Default simulation temperature (K) used by free-energy style estimates.
DEFAULT_TEMPERATURE_K = 300.0

# kB*T at 300 K in Joules
KBT_J = KB_J_PER_K * DEFAULT_TEMPERATURE_K

# Conversion: J/m^2 -> mJ/m^2 applied to kB*T based surface-tension units
KBT_MJ_PER_M2 = KBT_J * 1.0e23 / 1.0e3

# kcal/mol in J/mol
KCAL_PER_MOL_J = 4184.0

# Bulk number density of water at ambient conditions, Angstrom^-3
WATER_BULK_DENSITY = 0.033456

# Default hydrogen-bond geometric criteria (heavy-heavy distance in Angstrom,
# D-H...A angle in degrees with H at the vertex; 180 deg = linear bond).
DEFAULT_HB_DIST = 3.5
DEFAULT_HB_ANGLE = 120.0

# First-minimum of g_OO(r) for common water models; default neighbor cutoff
# used for three-body angle analyses (reference water_properties.py:210).
DEFAULT_TET_CUTOFF = 3.413

# LSI neighbor-shell cutoff (Shiratani & Sasai 1996).
DEFAULT_LSI_CUTOFF = 3.7

# Default hydration-shell cutoff (Angstrom) for bound/wrap decomposition.
DEFAULT_SHELL_CUTOFF = 4.0
