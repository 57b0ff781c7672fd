from . import quadrature, shape, element, vonmises, assembly, solve, umat

__all__ = ["quadrature", "shape", "element", "vonmises", "assembly", "solve", "umat"]
