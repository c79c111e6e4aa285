from .solver import (SolverConfig, propagate_prob, propagate_pop,  # noqa: F401
                     signal_fft, filter_fft, fft_conv_once)
