from .compare import absdiff, reldiff, effreldiff, compare
from .timing import timer, enable_benchmarks, disable_benchmarks, print_timer, reset_timer
from .binner import LogBinner
