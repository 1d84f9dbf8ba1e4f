from .model import SwfModel, build_chf, build_olf, Disv1dGrid  # noqa: F401
