from .parameters import DQMCParameters
from .dqmc import DQMC, DQMCAnalysis, MagnitudeStats
