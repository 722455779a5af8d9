from nerf_from_image_tpu.pose.pose import (  # noqa: F401
    invert_space,
    quaternion_rotate_vector,
    quaternion_to_matrix,
    matrix_to_quaternion,
    pose_to_matrix,
    matrix_to_pose,
    matrix_to_conditioning_vector,
    rotation_matrix_distance,
)
