from meshanything_tpu.geometry.obj_io import load_mesh, save_obj, Mesh
from meshanything_tpu.geometry.normalize import (
    normalize_pc_cli,
    normalize_mesh_app,
    normalize_vertices,
    discretize,
    undiscretize,
)
from meshanything_tpu.geometry.sample import sample_surface_with_normals
from meshanything_tpu.geometry.postprocess import postprocess_faces, faces_to_mesh
