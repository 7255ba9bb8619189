// Native host runtime for raymarching_tpu.
//
// The reference keeps its host runtime in C++: the scene text parser
// (scene.cpp:92-190), the CSG generators (body.cpp:113-170), and the
// tree -> device-table flattener (render.cpp:246-366).  This library is the
// TPU-native equivalent: it parses the identical objects.txt grammar and
// emits the framework's flat struct-of-arrays tables directly in the
// two-level kernel normal form (group id + fold sign per primitive) —
// no pointer tree, no device-side interpreter.  Exposed via a minimal
// C ABI consumed through ctypes (raymarching_tpu/native.py).
//
// Build: make native   -> libraymarch_host.so (links system zlib for PNG).

#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <sstream>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

enum PrimKind : int32_t { SPHERE = 0, BOX = 1, CROSS = 2, MANDELBOX = 3,
                          MANDELBULB = 4, JULIA = 5 };

struct Prim {
    int32_t type;
    float pos[3];
    float aux[3];    // sphere: (radius, 0, 0); box/cross: size;
                     // fractals: (size, param, iterations) — the ctypes
                     // layer splits the structural (param, iters) pair
                     // back out into plan statics (native.py)
    float color[3];
    float extra[4] = {0, 0, 0, 0};  // Julia quaternion constant c
    int32_t group;   // group index (root child)
    float scale;     // fold sign inside the group's min-reduction
};

struct Group {
    int32_t gsign;   // group value = gsign * min(scale_i * sd_i)
    int32_t count;
};

struct ParsedScene {
    std::vector<Prim> prims;
    std::vector<Group> groups;
    std::vector<float> lights;           // L * 3
    std::vector<float> light_colors;     // L * 3 (LightColor extension)
    float cur_light_color[3] = {1, 1, 1};
    float camera[10] = {0, 0, 0, 0, 0, -1, 0, 1, 0, 90};  // pos, dir, up, fov
};

// The 20 Menger subcell offsets in reference order (body.cpp:119-144):
// front 8 (z=-1), back 8 (z=+1), middle 4 (z=0).
const int kMengerOffsets[20][3] = {
    {1, -1, -1}, {0, -1, -1}, {-1, -1, -1}, {1, 1, -1}, {0, 1, -1},
    {-1, 1, -1}, {-1, 0, -1}, {1, 0, -1},
    {1, -1, 1}, {0, -1, 1}, {-1, -1, 1}, {1, 1, 1}, {0, 1, 1},
    {-1, 1, 1}, {-1, 0, 1}, {1, 0, 1},
    {-1, -1, 0}, {1, -1, 0}, {-1, 1, 0}, {1, 1, 0},
};

void pushPrim(ParsedScene &s, int32_t type, const float pos[3],
              const float aux[3], const float color[3], int32_t group,
              float scale) {
    Prim p;
    p.type = type;
    std::memcpy(p.pos, pos, sizeof p.pos);
    std::memcpy(p.aux, aux, sizeof p.aux);
    std::memcpy(p.color, color, sizeof p.color);
    p.group = group;
    p.scale = scale;
    s.prims.push_back(p);
}

// A bare primitive at the root: its own singleton min-group.
int32_t newGroup(ParsedScene &s, int32_t gsign) {
    s.groups.push_back({gsign, 0});
    return static_cast<int32_t>(s.groups.size()) - 1;
}

void mengerRecurse(ParsedScene &s, int32_t group, const float pos[3],
                   float size, int iterations, const float color[3]) {
    const float d = size / 3.0f;
    // DIFFERENCE group lowered to -min(...): first element scale -1,
    // subtracted crosses scale +1 (compile.py _kernel_normal_form).
    float aux[3] = {d, d, d};
    pushPrim(s, CROSS, pos, aux, color, group, +1.0f);
    s.groups[group].count++;
    if (iterations >= 2) {
        for (const auto &off : kMengerOffsets) {
            float sub[3] = {pos[0] + off[0] * d, pos[1] + off[1] * d,
                            pos[2] + off[2] * d};
            mengerRecurse(s, group, sub, d, iterations - 1, color);
        }
    }
}

// Numeric "r g b" or a defined material name (parser.py resolve_color).
bool readColor(std::istringstream &in,
               const std::map<std::string, std::array<float, 3>> &materials,
               float dst[3]) {
    std::string first;
    if (!(in >> first)) return false;
    char *end = nullptr;
    float r = std::strtof(first.c_str(), &end);
    if (end != first.c_str() && end && *end == '\0') {
        if (!(in >> dst[1] >> dst[2])) return false;
        dst[0] = r;
        return true;
    }
    auto it = materials.find(first);
    if (it == materials.end()) return false;   // unknown material
    std::memcpy(dst, it->second.data(), 3 * sizeof(float));
    return true;
}

bool parseScene(const char *text, ParsedScene &out) {
    std::istringstream stream(text);
    std::string line;
    float color[3] = {1.0f, 1.0f, 1.0f};
    std::map<std::string, std::array<float, 3>> materials;

    while (std::getline(stream, line)) {
        std::istringstream in(line);
        std::string cmd;
        if (!(in >> cmd)) continue;

        if (cmd == "Sphere") {
            float pos[3], r;
            if (!(in >> pos[0] >> pos[1] >> pos[2] >> r)) return false;
            float aux[3] = {r, 0, 0};
            int32_t g = newGroup(out, +1);
            pushPrim(out, SPHERE, pos, aux, color, g, +1.0f);
            out.groups[g].count++;
        } else if (cmd == "Box" || cmd == "Cross") {
            float pos[3], size[3];
            if (!(in >> pos[0] >> pos[1] >> pos[2]
                     >> size[0] >> size[1] >> size[2])) return false;
            int32_t g = newGroup(out, +1);
            pushPrim(out, cmd == "Box" ? BOX : CROSS, pos, size, color, g,
                     +1.0f);
            out.groups[g].count++;
        } else if (cmd == "Mandelbox") {
            // Extension keyword (parser.py): optional trailing
            // (scale, iterations) default to (2, 8).
            float pos[3], size;
            if (!(in >> pos[0] >> pos[1] >> pos[2] >> size)) return false;
            float mscale = 2.0f;
            int iterations = 8;
            // (a failed C++11 extraction zeroes its target — keep the
            // defaults by reading through temporaries)
            float ms;
            if (in >> ms) mscale = ms;
            int it;
            if (in >> it) iterations = it;
            float aux[3] = {size, mscale, static_cast<float>(iterations)};
            int32_t g = newGroup(out, +1);
            pushPrim(out, MANDELBOX, pos, aux, color, g, +1.0f);
            out.groups[g].count++;
        } else if (cmd == "Mandelbulb") {
            // Extension keyword (parser.py): optional trailing iterations
            // defaults to 6; the power is fixed at 8 (aux[1], for ABI
            // symmetry with Mandelbox's (param, iterations) pair).
            float pos[3], size;
            if (!(in >> pos[0] >> pos[1] >> pos[2] >> size)) return false;
            int iterations = 6;
            int it;
            if (in >> it) iterations = it;
            float aux[3] = {size, 8.0f, static_cast<float>(iterations)};
            int32_t g = newGroup(out, +1);
            pushPrim(out, MANDELBULB, pos, aux, color, g, +1.0f);
            out.groups[g].count++;
        } else if (cmd == "Julia") {
            // Extension keyword (parser.py): quaternion constant c (4
            // floats, structural) rides the Prim.extra slots over the
            // C ABI; optional trailing iterations defaults to 11.
            float pos[3], size, c4[4];
            if (!(in >> pos[0] >> pos[1] >> pos[2] >> size
                     >> c4[0] >> c4[1] >> c4[2] >> c4[3])) return false;
            int iterations = 11;
            int it;
            if (in >> it) iterations = it;
            float aux[3] = {size, 0.0f, static_cast<float>(iterations)};
            int32_t g = newGroup(out, +1);
            pushPrim(out, JULIA, pos, aux, color, g, +1.0f);
            std::memcpy(out.prims.back().extra, c4, sizeof c4);
            out.groups[g].count++;
        } else if (cmd == "Bounds") {
            // COMPLEMENT list of one black box (scene.cpp:120-127):
            // value = min(-sd) => gsign +1, scale -1.
            float size;
            if (!(in >> size)) return false;
            float pos[3] = {0, 0, 0};
            float aux[3] = {size, size, size};
            float black[3] = {0, 0, 0};
            int32_t g = newGroup(out, +1);
            pushPrim(out, BOX, pos, aux, black, g, -1.0f);
            out.groups[g].count++;
        } else if (cmd == "DeathStar") {
            // DIFFERENCE: max(s0, -s1) = -min(-s0, s1)  (body.cpp:159-169)
            float pos[3], r;
            if (!(in >> pos[0] >> pos[1] >> pos[2] >> r)) return false;
            float aux[3] = {r, 0, 0};
            int32_t g = newGroup(out, -1);
            pushPrim(out, SPHERE, pos, aux, color, g, -1.0f);
            float dpos[3] = {pos[0] + 1.5f * r, pos[1], pos[2]};
            pushPrim(out, SPHERE, dpos, aux, color, g, +1.0f);
            out.groups[g].count += 2;
        } else if (cmd == "MengerSponge") {
            float pos[3], size;
            int iterations;
            if (!(in >> pos[0] >> pos[1] >> pos[2] >> size >> iterations))
                return false;
            int32_t g = newGroup(out, -1);
            float aux[3] = {size, size, size};
            pushPrim(out, BOX, pos, aux, color, g, -1.0f);
            out.groups[g].count++;
            mengerRecurse(out, g, pos, size, iterations, color);
        } else if (cmd == "Light") {
            float pos[3];
            if (!(in >> pos[0] >> pos[1] >> pos[2])) return false;
            out.lights.insert(out.lights.end(), pos, pos + 3);
            out.light_colors.insert(out.light_colors.end(),
                                    out.cur_light_color,
                                    out.cur_light_color + 3);
        } else if (cmd == "LightColor") {
            // Extension keyword (parser.py): a running current light color
            // applied to subsequent Light lines; default white.
            if (!readColor(in, materials, out.cur_light_color)) return false;
        } else if (cmd == "Material") {
            // Extension keyword (parser.py): named reusable color, pure
            // sugar over the running-color state; later definition wins.
            std::string name;
            float c[3];
            if (!(in >> name >> c[0] >> c[1] >> c[2])) return false;
            materials[name] = {c[0], c[1], c[2]};
        } else if (cmd == "Camera") {
            std::string sub;
            if (!(in >> sub)) return false;
            if (sub == "Position") {
                if (!(in >> out.camera[0] >> out.camera[1] >> out.camera[2]))
                    return false;
            } else if (sub == "Direction") {
                if (!(in >> out.camera[3] >> out.camera[4] >> out.camera[5]))
                    return false;
            } else if (sub == "Up") {
                if (!(in >> out.camera[6] >> out.camera[7] >> out.camera[8]))
                    return false;
            } else if (sub == "FOV") {
                if (!(in >> out.camera[9])) return false;
            }
        } else if (cmd == "Color") {
            if (!readColor(in, materials, color)) return false;
        }
        // Unknown keywords are ignored, like the reference loader.
    }
    return true;
}

}  // namespace

extern "C" {

int rm_parse_scene_counts(const char *text, int32_t *num_prims,
                          int32_t *num_lights) {
    ParsedScene s;
    if (!parseScene(text, s)) return 1;
    *num_prims = static_cast<int32_t>(s.prims.size());
    *num_lights = static_cast<int32_t>(s.lights.size() / 3);
    return 0;
}

int rm_parse_scene_fill(const char *text, int32_t *prim_type, float *prim_pos,
                        float *prim_aux, float *prim_color, int32_t *group_id,
                        int32_t *group_count, int32_t *group_meta,
                        float *prim_scale, float *lights, float *camera,
                        float *prim_extra, float *light_colors) {
    ParsedScene s;
    if (!parseScene(text, s)) return 1;
    for (size_t i = 0; i < s.prims.size(); ++i) {
        const Prim &p = s.prims[i];
        prim_type[i] = p.type;
        std::memcpy(prim_pos + 3 * i, p.pos, sizeof p.pos);
        std::memcpy(prim_aux + 3 * i, p.aux, sizeof p.aux);
        std::memcpy(prim_color + 3 * i, p.color, sizeof p.color);
        std::memcpy(prim_extra + 4 * i, p.extra, sizeof p.extra);
        group_id[i] = p.group;
        prim_scale[i] = p.scale;
    }
    *group_count = static_cast<int32_t>(s.groups.size());
    for (size_t g = 0; g < s.groups.size(); ++g) {
        group_meta[2 * g] = s.groups[g].gsign;
        group_meta[2 * g + 1] = s.groups[g].count;
    }
    std::memcpy(lights, s.lights.data(), s.lights.size() * sizeof(float));
    std::memcpy(light_colors, s.light_colors.data(),
                s.light_colors.size() * sizeof(float));
    std::memcpy(camera, s.camera, sizeof s.camera);
    return 0;
}

// Minimal PNG writer (8-bit RGB/RGBA, filter 0, zlib-deflated) — the
// clean-room stand-in for the reference's vendored stb_image_write.
int rm_write_png(const char *path, int width, int height, int channels,
                 const uint8_t *data) {
    if (channels != 3 && channels != 4) return 2;

    const size_t stride = static_cast<size_t>(width) * channels;
    std::vector<uint8_t> raw((stride + 1) * height);
    for (int y = 0; y < height; ++y) {
        raw[(stride + 1) * y] = 0;  // filter type 0
        std::memcpy(&raw[(stride + 1) * y + 1], data + stride * y, stride);
    }

    uLongf bound = compressBound(raw.size());
    std::vector<uint8_t> idat(bound);
    if (compress2(idat.data(), &bound, raw.data(), raw.size(), 6) != Z_OK)
        return 3;
    idat.resize(bound);

    FILE *f = std::fopen(path, "wb");
    if (!f) return 4;

    auto be32 = [](uint32_t v, uint8_t *out) {
        out[0] = v >> 24; out[1] = v >> 16; out[2] = v >> 8; out[3] = v;
    };
    auto writeChunk = [&](const char *tag, const uint8_t *payload,
                          uint32_t len) {
        uint8_t hdr[8];
        be32(len, hdr);
        std::memcpy(hdr + 4, tag, 4);
        std::fwrite(hdr, 1, 8, f);
        if (len) std::fwrite(payload, 1, len, f);
        uLong crc = crc32(0L, hdr + 4, 4);
        if (len) crc = crc32(crc, payload, len);
        uint8_t tail[4];
        be32(static_cast<uint32_t>(crc), tail);
        std::fwrite(tail, 1, 4, f);
    };

    const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    std::fwrite(sig, 1, 8, f);
    uint8_t ihdr[13];
    be32(static_cast<uint32_t>(width), ihdr);
    be32(static_cast<uint32_t>(height), ihdr + 4);
    ihdr[8] = 8;                          // bit depth
    ihdr[9] = channels == 3 ? 2 : 6;      // color type
    ihdr[10] = ihdr[11] = ihdr[12] = 0;
    writeChunk("IHDR", ihdr, 13);
    writeChunk("IDAT", idat.data(), static_cast<uint32_t>(idat.size()));
    writeChunk("IEND", nullptr, 0);
    std::fclose(f);
    return 0;
}

}  // extern "C"
