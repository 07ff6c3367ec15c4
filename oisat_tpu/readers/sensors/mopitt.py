"""MOPITT product readers (full implementation in the sensor milestone)."""


def mopitt_reader(*args, **kwargs):
    raise NotImplementedError("MOPITT reader lands with the sensor milestone")
