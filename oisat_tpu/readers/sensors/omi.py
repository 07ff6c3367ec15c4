"""OMI product readers (full implementation in the sensor milestone)."""


def omi_reader(*args, **kwargs):
    raise NotImplementedError("OMI reader lands with the sensor milestone")
