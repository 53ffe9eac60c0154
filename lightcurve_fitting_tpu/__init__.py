"""lightcurve_fitting_tpu: a TPU-native (JAX/XLA) framework for fitting
analytical supernova light-curve models, with the full capabilities of
griffin-h/lightcurve_fitting redesigned for accelerator execution."""

__version__ = "0.1.0"
