from .layers import InstanceNorm, ResnetBlock  # noqa: F401
from .generators import GlobalGenerator, TransG, TexG, BGNet  # noqa: F401
from .discriminator import MultiscaleDiscriminator  # noqa: F401
from .renderer import NeuralRenderer  # noqa: F401
from .vgg import VGG19Features  # noqa: F401
