"""Short import alias for the framework package.

``import wadt`` re-binds this module to the real package
``heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu``
so that submodule imports (``import wadt.models.pmg``) resolve through the real
package's ``__path__``.
"""

import sys

import heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu as _pkg

sys.modules[__name__] = _pkg
