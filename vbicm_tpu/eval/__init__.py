from .laplace import LaplaceResult, laplace_posterior
from .mcmc import MetropolisResult, make_fem_logpost, metropolis, posterior_predictive_z
from .postprocess import (
    gaussian_kde_pdf,
    kld_gaussian_kde,
    lognormal_pdf_2d,
    plot_deformed_mesh,
)
from .xdmf import write_xdmf

__all__ = [
    "LaplaceResult",
    "laplace_posterior",
    "MetropolisResult",
    "make_fem_logpost",
    "metropolis",
    "posterior_predictive_z",
    "gaussian_kde_pdf",
    "kld_gaussian_kde",
    "lognormal_pdf_2d",
    "plot_deformed_mesh",
    "write_xdmf",
]
