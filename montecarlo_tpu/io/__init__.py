from .recorder import ConfigRecorder, Discarder
from .checkpoint import save, load, resume
