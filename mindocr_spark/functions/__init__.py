"""Pure-numpy / stdlib kernel library shared by the oracle and the Spark UDFs.

No cv2 / PIL / shapely / pyclipper — every kernel the reference delegates to
those libraries is reimplemented here in deterministic numpy so that the
single-process oracle and the distributed job run *identical* code.
"""
