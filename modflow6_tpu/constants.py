"""Framework-wide numerical constants.

Mirrors the semantics of the reference's constants module
(reference src/Utilities/Constants.f90) where those constants shape
numerical behavior (smoothing cutoffs, log-mean switch points, no-data
sentinels).  Values are plain Python floats; all device math is float64.
"""

import numpy as np

DZERO = 0.0
DHALF = 0.5
DONE = 1.0
DTWO = 2.0
DPI = float(np.pi)

# machine precision for float64 (reference: DPREC = EPSILON(1.0_DP))
DPREC = float(np.finfo(np.float64).eps)
DPRECSQRT = float(np.sqrt(DPREC))
DSAME = 100.0 * DPREC

DEM1 = 1.0e-1
DEM2 = 1.0e-2
DEM3 = 1.0e-3
DEM4 = 1.0e-4
DEM5 = 1.0e-5
DEM6 = 1.0e-6
DEM7 = 1.0e-7
DEM8 = 1.0e-8
DEM9 = 1.0e-9
DEM15 = 1.0e-15
DEM20 = 1.0e-20
DEM30 = 1.0e-30

# ratio window inside which the log-mean falls back to the arithmetic mean
# (reference Constants.f90:125-126)
DLNLOW = 0.995
DLNHIGH = 1.005

# sentinels (reference Constants.f90 DHNOFLO/DHDRY/DNODATA)
DHNOFLO = 1.0e30
DHDRY = -1.0e30
DNODATA = 3.0e30

# connection types (reference Constants.f90 C3D_* enumerators)
C3D_VERTICAL = 0
C3D_HORIZONTAL = 1
C3D_STAGGERED = 2

# under-relaxation scheme ids (reference NumericalSolution nonmeth)
NONMETH_NONE = 0
NONMETH_SIMPLE = 1
NONMETH_COOLEY = 2
NONMETH_DBD = 3

# cell-averaging options for conductance (reference GwfConductanceUtils.f90)
CCOND_HMEAN = 0
CCOND_LMEAN = 1
CCOND_AMTLMK = 2
CCOND_AMTHMK = 3
