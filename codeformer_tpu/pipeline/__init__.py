from .restorer import CodeFormerRestorer
from .face_helper import FaceRestoreHelper
from .detector import FaceDetector, YoloFaceDetector, init_detection_model

__all__ = ['CodeFormerRestorer', 'FaceRestoreHelper', 'FaceDetector',
           'YoloFaceDetector', 'init_detection_model']
