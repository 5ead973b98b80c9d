from .core import Measurement, MeasurementRegistry, ObservableResult
from .ising import IsingEnergyMeasurement, IsingMagnetizationMeasurement

# DQMC measurement constructors (populated as the DQMC layer lands)
try:
    from .dqmc_measurements import (
        greens_measurement, occupation, boson_energy_measurement,
        charge_density_correlation, charge_density_susceptibility,
        magnetization, spin_density_correlation, spin_density_susceptibility,
        pairing_correlation, pairing_susceptibility,
        current_current_susceptibility,
        noninteracting_energy, total_energy, kinetic_energy, interaction_energy,
    )
except ImportError:  # pragma: no cover - partial build
    pass
