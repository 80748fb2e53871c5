from .elements import BBOX_4326, generate_elements, elements_to_spark  # noqa: F401
from .images import generate_images, images_to_spark, geotag_from_phash  # noqa: F401
