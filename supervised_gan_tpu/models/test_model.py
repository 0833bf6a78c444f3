"""TestModel — bare A->B inference on the single dataset
(reference models/test_model.py).

The reference's define_G call passes gpu_ids positionally into the
n_layers_G slot (reference test_model.py:17-20) — harmless for the default
resnet generator; we pass options properly.
"""

from collections import OrderedDict

import jax

from .base import BaseModel
from .common import g_apply
from .. import nn
from ..utils.images import tensor2im


class TestModel(BaseModel):
    def name(self):
        return 'TestModel'

    def initialize(self, opt):
        assert not opt.isTrain
        BaseModel.initialize(self, opt)
        self.netG = nn.define_G(
            opt.input_nc, opt.output_nc, opt.ngf, opt.which_model_netG,
            opt.norm, not opt.no_dropout, n_layers_G=opt.n_layers_G,
            noise_nc=opt.noise_nc)
        self.params = self.load_network(self.netG, 'G', opt.which_epoch)
        cd = self.compute_dtype
        self._g_jit = jax.jit(lambda p, x, fk: g_apply(
            self.netG, p, nn.Ctx(fk, compute_dtype=cd), x=x))
        print('---------- Networks initialized -------------')
        nn.print_network(self.netG, self.params, 'G')
        print('-----------------------------------------------')

    def set_input(self, input):
        self.input_A = self.to_device_batch(input['A'])
        self.image_paths = input['A_paths']

    def test(self):
        self.real_A = self.input_A
        self.fake_B = self._g_jit(self.params, self.real_A,
                                  self.next_test_key())

    def get_current_visuals(self, save_as_single_image=False):
        return OrderedDict([('real_A', tensor2im(self.real_A)),
                            ('fake_B', tensor2im(self.fake_B))])
