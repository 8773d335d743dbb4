from delora_tpu.ops.projection import ProjectionSpec, project_scan, project_batch  # noqa: F401
from delora_tpu.ops.eigh3 import smallest_eigenvector_sym3x3, eigenvalues_sym3x3  # noqa: F401
from delora_tpu.ops.normals import compute_normal_image, NormalsSpec  # noqa: F401
from delora_tpu.ops.correspondence import (  # noqa: F401
    projective_correspondence,
    brute_force_correspondence,
)
