from meshanything_tpu.utils.io import (  # noqa: F401
    MeshOutput,
    extract_tar,
    json_loads,
    load_json,
    mkdir,
    npy_loads,
    npz_loads,
    save_textured_obj,
    write_json,
    write_png,
)
