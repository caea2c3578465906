from .test_driver import run_inference  # noqa: F401
