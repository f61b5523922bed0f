"""Small shared model config for tests (28x28, reduced capsule counts)."""

def small_model_params(**overrides):
    params = dict(
        image_shape=(1, 28, 28),
        n_classes=10,
        n_part_caps=16,
        n_obj_caps=10,
    )
    params.update(overrides)
    return params
