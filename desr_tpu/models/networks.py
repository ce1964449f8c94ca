"""Generator/discriminator zoo A (pix2pix lineage), TPU-native.

Re-implements the architectures of the reference's models/networks.py:
- ResnetGenerator (:353-421) + ResnetBlock (:424-481)
- UnetGenerator / UnetSkipConnectionBlock incl. the SR decoder head (:484-629)
- NLayerDiscriminator (:632-677), PixelDiscriminator (:680-709)
- define_G (:121-163) / define_D (:166-207) factories

Parameter keys match the reference's torch ``state_dict`` exactly (Sequential
index numbering included), so stage-1/2/3 checkpoints interchange freely.
Note the as-shipped quirk that feature extractors are ResnetGenerators ending
in Tanh (networks.py:415) — features pass through Tanh; kept for weight parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from desr_tpu.models import layers as L
from desr_tpu.models.layers import (
    Conv2d,
    ConvTranspose2d,
    Ctx,
    Dropout,
    Identity,
    InitCfg,
    InstanceNorm2d,
    Layer,
    LeakyReLU,
    ReLU,
    ReflectionPad2d,
    Sequential,
    Tanh,
    Upsample,
    get_norm_layer,
)


class Net:
    """A named network: wraps a root Layer tree plus its init config."""

    def __init__(self, root: Layer, init_cfg: InitCfg, root_prefix: str = "model."):
        self.root = root
        self.init_cfg = init_cfg
        self.root_prefix = root_prefix

    def init(self, key):
        return self.root.init(key, self.root_prefix, self.init_cfg)

    def apply(self, params, x, ctx: Ctx = Ctx()):
        return self.root.apply(params, x, self.root_prefix, ctx)

    def apply_parts(self, params, parts, ctx: Ctx = Ctx()):
        """Apply on a channel-split input without concatenating it (see
        Conv2d.apply_split); falls back to concat when the root doesn't
        support split inputs."""
        if hasattr(self.root, "apply_parts"):
            return self.root.apply_parts(params, parts, self.root_prefix, ctx)
        return self.root.apply(params, jnp.concatenate(parts, axis=-1),
                               self.root_prefix, ctx)

    def param_count(self, params):
        return sum(int(v.size) for v in params.values())


class ResnetBlock(Layer):
    """Reference networks.py:424-481; keys under ``conv_block.``."""

    def __init__(self, dim, padding_type, norm_factory, use_dropout, use_bias):
        blocks = []
        for half in range(2):
            p = 0
            if padding_type == "reflect":
                blocks.append(ReflectionPad2d(1))
            elif padding_type == "replicate":
                blocks.append(L.ReplicationPad2d(1))
            elif padding_type == "zero":
                p = 1
            else:
                raise NotImplementedError(padding_type)
            blocks.append(Conv2d(dim, dim, 3, padding=p, bias=use_bias))
            blocks.append(norm_factory(dim))
            if half == 0:
                blocks.append(ReLU())
                if use_dropout:
                    blocks.append(Dropout(0.5))
        self.conv_block = Sequential(blocks)

    def init(self, key, prefix, cfg):
        return self.conv_block.init(key, prefix + "conv_block.", cfg)

    def apply(self, params, x, prefix, ctx):
        return x + self.conv_block.apply(params, x, prefix + "conv_block.", ctx)


def _resnet_generator_layers(input_nc, output_nc, ngf, norm_factory, use_bias,
                             use_dropout, n_blocks, padding_type,
                             replace_transpose, n_downsampling):
    model = [
        ReflectionPad2d(3),
        Conv2d(input_nc, ngf, 7, padding=0, bias=use_bias),
        norm_factory(ngf),
        ReLU(),
    ]
    for i in range(n_downsampling):
        mult = 2 ** i
        model += [
            Conv2d(ngf * mult, ngf * mult * 2, 3, stride=2, padding=1, bias=use_bias),
            norm_factory(ngf * mult * 2),
            ReLU(),
        ]
    mult = 2 ** n_downsampling
    for _ in range(n_blocks):
        model.append(ResnetBlock(ngf * mult, padding_type, norm_factory, use_dropout, use_bias))
    for i in range(n_downsampling):
        mult = 2 ** (n_downsampling - i)
        if replace_transpose:
            model += [
                Upsample(2, "nearest"),
                ReflectionPad2d(1),
                Conv2d(ngf * mult, ngf * mult // 2, 3, stride=1, padding=0),
                norm_factory(ngf * mult // 2),
                ReLU(),
            ]
        else:
            model += [
                ConvTranspose2d(ngf * mult, ngf * mult // 2, 3, stride=2, padding=1,
                                output_padding=1, bias=use_bias),
                norm_factory(ngf * mult // 2),
                ReLU(),
            ]
    model += [ReflectionPad2d(3), Conv2d(ngf, output_nc, 7, padding=0, bias=True), Tanh()]
    return Sequential(model)


class _UnetBlock(Layer):
    """UnetSkipConnectionBlock (networks.py:516-629); keys under ``model.``."""

    def __init__(self, outer_nc, inner_nc, input_nc, submodule, outermost, innermost,
                 norm_factory, use_bias, use_dropout=False, sr=False):
        if input_nc is None:
            input_nc = outer_nc
        downconv = Conv2d(input_nc, inner_nc, 4, stride=2, padding=1, bias=use_bias)
        downrelu = LeakyReLU(0.2)
        uprelu = ReLU()
        self.outermost = outermost
        if outermost:
            if not sr:
                upconv = ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2, padding=1, bias=True)
                model = [downconv, submodule, uprelu, upconv, Tanh()]
            else:
                # SR decoder head (networks.py:559-602): the up path emits 2x
                # resolution per axis via two extra transposed convs with
                # interleaved resnet blocks.
                model = [
                    downconv,
                    submodule,
                    ReLU(),
                    ConvTranspose2d(inner_nc * 2, inner_nc // 2, 4, stride=2, padding=1, bias=True),
                    norm_factory(inner_nc),
                    ResnetBlock(inner_nc // 2, "reflect", norm_factory, use_dropout, use_bias),
                    ReLU(),
                    ConvTranspose2d(inner_nc // 2, inner_nc // 4, 4, stride=2, padding=1, bias=True),
                    norm_factory(inner_nc),
                    ResnetBlock(inner_nc // 4, "reflect", norm_factory, use_dropout, use_bias),
                    ReLU(),
                    Conv2d(inner_nc // 4, 1, 3, padding=1, bias=True),
                    Tanh(),
                ]
        elif innermost:
            upconv = ConvTranspose2d(inner_nc, outer_nc, 4, stride=2, padding=1, bias=use_bias)
            model = [downrelu, downconv, uprelu, upconv, norm_factory(outer_nc)]
        else:
            upconv = ConvTranspose2d(inner_nc * 2, outer_nc, 4, stride=2, padding=1, bias=use_bias)
            model = [downrelu, downconv, norm_factory(inner_nc), submodule, uprelu, upconv,
                     norm_factory(outer_nc)]
            if use_dropout:
                model.append(Dropout(0.5))
        self.model = Sequential(model)

    def init(self, key, prefix, cfg):
        return self.model.init(key, prefix + "model.", cfg)

    def apply(self, params, x, prefix, ctx):
        # pin the dp x sp layout per pyramid level (see layers.spatial_anchor)
        x = L.spatial_anchor(x, ctx)
        out = L.spatial_anchor(self.model.apply(params, x, prefix + "model.", ctx), ctx)
        if self.outermost:
            return out
        return jnp.concatenate([x, out], axis=-1)

    def apply_parts(self, params, parts, prefix, ctx):
        """Outermost-only entry that feeds a channel-split input straight to
        the first downconv (Conv2d.apply_split) — the caller's channel
        concatenate never materializes."""
        assert self.outermost, "apply_parts is an outermost U-Net entry"
        if not ctx.split_conv:
            return self.apply(params, jnp.concatenate(parts, axis=-1), prefix, ctx)
        parts = [L.spatial_anchor(p, ctx) for p in parts]
        seq = self.model
        downconv = seq.layers[0]
        y = downconv.apply_split(params, parts, prefix + "model.0.", ctx)
        out = seq.apply(params, y, prefix + "model.", ctx, start=1)
        return L.spatial_anchor(out, ctx)


def _unet_generator(input_nc, output_nc, num_downs, ngf, norm_factory, use_bias,
                    use_dropout=False, use_sr=False):
    block = _UnetBlock(ngf * 8, ngf * 8, None, None, False, True, norm_factory, use_bias)
    for _ in range(num_downs - 5):
        block = _UnetBlock(ngf * 8, ngf * 8, None, block, False, False, norm_factory,
                           use_bias, use_dropout)
    block = _UnetBlock(ngf * 4, ngf * 8, None, block, False, False, norm_factory, use_bias)
    block = _UnetBlock(ngf * 2, ngf * 4, None, block, False, False, norm_factory, use_bias)
    block = _UnetBlock(ngf, ngf * 2, None, block, False, False, norm_factory, use_bias)
    outer = _UnetBlock(output_nc, ngf, input_nc, block, True, False, norm_factory,
                       use_bias, use_dropout, sr=use_sr)
    return outer


def define_G(input_nc, output_nc, ngf, netG, norm="instance", use_dropout=False,
             init_type="normal", init_gain=0.02, replace_transpose=False,
             n_down=2, use_sr=False, use_old=False) -> Net:
    """Mirror of reference define_G (networks.py:121-163)."""
    norm_factory, use_bias = get_norm_layer(norm, lineage="pix2pix")
    if use_old and norm == "group":
        norm_factory = lambda ch: L.GroupNorm(1, ch, affine=False)  # noqa: E731
    cfg = InitCfg(init_type=init_type, init_gain=init_gain)
    if netG == "resnet_9blocks":
        root = _resnet_generator_layers(input_nc, output_nc, ngf, norm_factory, use_bias,
                                        use_dropout, 9, "reflect", replace_transpose, n_down)
    elif netG == "resnet_6blocks":
        root = _resnet_generator_layers(input_nc, output_nc, ngf, norm_factory, use_bias,
                                        use_dropout, 6, "reflect", replace_transpose, n_down)
    elif netG == "unet_128":
        root = _unet_generator(input_nc, output_nc, 7, ngf, norm_factory, use_bias,
                               use_dropout, use_sr)
    elif netG == "unet_256":
        root = _unet_generator(input_nc, output_nc, 8, ngf, norm_factory, use_bias,
                               use_dropout, use_sr)
    else:
        raise NotImplementedError(f"Generator model name [{netG}] is not recognized")
    return Net(root, cfg, root_prefix="model.")


def _nlayer_discriminator(input_nc, ndf, n_layers, norm_factory, use_bias):
    seq = [Conv2d(input_nc, ndf, 4, stride=2, padding=1, bias=True), LeakyReLU(0.2)]
    nf_mult = 1
    for n in range(1, n_layers):
        nf_mult_prev, nf_mult = nf_mult, min(2 ** n, 8)
        seq += [
            Conv2d(ndf * nf_mult_prev, ndf * nf_mult, 4, stride=2, padding=1, bias=use_bias),
            norm_factory(ndf * nf_mult),
            LeakyReLU(0.2),
        ]
    nf_mult_prev, nf_mult = nf_mult, min(2 ** n_layers, 8)
    seq += [
        Conv2d(ndf * nf_mult_prev, ndf * nf_mult, 4, stride=1, padding=1, bias=use_bias),
        norm_factory(ndf * nf_mult),
        LeakyReLU(0.2),
        Conv2d(ndf * nf_mult, 1, 4, stride=1, padding=1, bias=True),
    ]
    return Sequential(seq)


def _pixel_discriminator(input_nc, ndf, norm_factory, use_bias):
    return Sequential([
        Conv2d(input_nc, ndf, 1, bias=True),
        LeakyReLU(0.2),
        Conv2d(ndf, ndf * 2, 1, bias=use_bias),
        norm_factory(ndf * 2),
        LeakyReLU(0.2),
        Conv2d(ndf * 2, 1, 1, bias=use_bias),
    ])


def define_D(input_nc, ndf, netD, n_layers_D=3, norm="instance",
             init_type="normal", init_gain=0.02) -> Net:
    """Mirror of reference define_D (networks.py:166-207)."""
    norm_factory, use_bias = get_norm_layer(norm, lineage="pix2pix")
    cfg = InitCfg(init_type=init_type, init_gain=init_gain)
    if netD == "basic":
        root = _nlayer_discriminator(input_nc, ndf, 3, norm_factory, use_bias)
        return Net(root, cfg, "model.")
    if netD == "n_layers":
        root = _nlayer_discriminator(input_nc, ndf, n_layers_D, norm_factory, use_bias)
        return Net(root, cfg, "model.")
    if netD == "pixel":
        root = _pixel_discriminator(input_nc, ndf, norm_factory, use_bias)
        return Net(root, cfg, "net.")  # reference stores PixelDiscriminator under `net`
    raise NotImplementedError(f"Discriminator model name [{netD}] is not recognized")
