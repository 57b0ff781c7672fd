from .elbo import (
    term1,
    term2,
    term3,
    term4,
    term5,
    moment_match_loss,
    make_loss_step1,
    make_loss_step2,
)
from .train import TwoStepTrainer, TrainResult

__all__ = [
    "term1",
    "term2",
    "term3",
    "term4",
    "term5",
    "moment_match_loss",
    "make_loss_step1",
    "make_loss_step2",
    "TwoStepTrainer",
    "TrainResult",
]
