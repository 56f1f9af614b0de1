from .stencils import del2_bc, jacobian9, interior_5pt  # noqa: F401
from .integrals import xintp_weights, xintp, xintt  # noqa: F401
from .vorticity import qcomp, ocqbdy, atqzbd, merqcy  # noqa: F401
