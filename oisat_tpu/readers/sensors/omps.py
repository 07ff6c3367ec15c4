"""OMPS product readers (full implementation in the sensor milestone)."""


def omps_reader(*args, **kwargs):
    raise NotImplementedError("OMPS reader lands with the sensor milestone")
