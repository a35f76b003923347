from . import files, opensky, simulator  # noqa: F401
