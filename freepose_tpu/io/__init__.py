from freepose_tpu.io import bop_csv, mesh, proposals_json, rle

__all__ = ["rle", "bop_csv", "proposals_json", "mesh"]
