from . import quadrature, shape, element, vonmises, assembly, solve

__all__ = ["quadrature", "shape", "element", "vonmises", "assembly", "solve"]
