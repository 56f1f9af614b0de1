from .helmholtz import (  # noqa: F401
    dst1,
    BoxHelmholtz,
    CyclicHelmholtz,
    make_box_helmholtz,
    make_cyclic_helmholtz,
)
