from . import quadrature, shape, element, vonmises, assembly, solve, umat, plasticity, viscoelastic

__all__ = ["quadrature", "shape", "element", "vonmises", "assembly", "solve", "umat", "plasticity", "viscoelastic"]
