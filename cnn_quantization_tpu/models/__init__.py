from .zoo import build_model, available_archs
