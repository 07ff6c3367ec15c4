"""TROPOMI product readers (full implementation in the sensor milestone)."""


def tropomi_reader(*args, **kwargs):
    raise NotImplementedError("TROPOMI reader lands with the sensor milestone")
