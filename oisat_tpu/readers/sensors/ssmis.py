"""SSMIS product readers (full implementation in the sensor milestone)."""


def ssmis_reader(*args, **kwargs):
    raise NotImplementedError("SSMIS reader lands with the sensor milestone")
