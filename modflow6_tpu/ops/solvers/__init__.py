from .krylov import cg, bicgstab, KrylovResult
from .precond import jacobi_precondition, make_preconditioner
