from .core import Measurement, MeasurementRegistry, ObservableResult
from .ising import IsingEnergyMeasurement, IsingMagnetizationMeasurement
from .dqmc_measurements import (
    Greens, GreensAt, CombinedGreensIterator,
    charge_density, spin_density, pairing,
    greens_measurement, occupation, boson_energy_measurement,
    sign_measurement,
    charge_density_correlation, charge_density_susceptibility,
    magnetization, spin_density_correlation, spin_density_susceptibility,
    pairing_correlation, pairing_susceptibility,
    current_current_susceptibility,
)
from .custom import custom_measurement, selection_matrices
from . import postprocessing
