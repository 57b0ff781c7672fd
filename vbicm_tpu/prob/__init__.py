from .datagen import MeasurementDataset, generate_data_fem, load_dataset, save_dataset
from .analytic import (
    f_fun_1d_case2,
    f_fun_2d_case3,
    h_fun_1d_case1,
    h_fun_1d_case2,
    h_fun_2d_case3,
    generate_data_1d,
)

__all__ = [
    "MeasurementDataset",
    "generate_data_fem",
    "load_dataset",
    "save_dataset",
    "generate_data_1d",
    "f_fun_1d_case2",
    "f_fun_2d_case3",
    "h_fun_1d_case1",
    "h_fun_1d_case2",
    "h_fun_2d_case3",
]
